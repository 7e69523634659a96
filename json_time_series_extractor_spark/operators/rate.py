"""Counter-rate operators: reset-aware increase / per-second rate.

PromQL-style counter semantics over the sample stream: a counter only
goes up; a drop means the process restarted and the counter restarted
from ~0, so the post-reset value itself is the increase since the reset.
Per sample (ordered by ts within a series):

    delta   = value - lag(value)
    contrib = 0        when delta is null (first sample: no baseline)
              delta    when delta >= 0
              value    when delta < 0  (reset)

``increase`` per (series, bucket) = sum of its samples' contributions;
``rate`` = increase / bucket seconds.

Scale note — same skew exposure as gap-fill: the lag window is per
series, so a hot series is one window partition. The default here is the
SEGMENT-PARTITIONED plan (the two-pass carry from gapfill's playbook):
within-day lag windows bounded to (series, day), plus each day's first
sample taking its baseline from the previous day's last value via a tiny
per-day summary table — result-identical to the whole-series window,
which remains available as ``segment=None`` for small series.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from json_time_series_extractor_spark.operators.gapfill import (
    _epoch_floor,
    _interval_seconds,
)
from json_time_series_extractor_spark.operators.rollup import _bucket


def _contrib(delta, value):
    return (F.when(delta.isNull(), F.lit(0.0))
            .when(delta >= 0, delta)
            .otherwise(value))


def _sample_deltas(
    samples: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    segment: Optional[str],
) -> DataFrame:
    """Per-sample reset-aware delta stream shared by the counter
    family: (series_key, _ts, _v, _delta), _delta null only for a
    series' globally-first sample. ``segment`` picks the bounded
    (series, segment)-window plan with the per-segment carry summary;
    ``None`` the whole-series window (result-identical)."""
    v = F.col(value_col)
    s = samples.where(v.isNotNull()).select(
        F.col(key_col).alias("series_key"),
        F.col(ts_col).alias("_ts"),
        v.alias("_v"))

    if segment is None:
        w = Window.partitionBy("series_key").orderBy("_ts", "_v")
        return s.select(
            "series_key", "_ts", "_v",
            (F.col("_v") - F.lag("_v").over(w)).alias("_delta"))

    seg_s = _interval_seconds(segment)
    s = s.select("series_key", "_ts", "_v",
                 _epoch_floor(F.col("_ts"), seg_s).alias("_seg"))

    # Within-segment lag: bounded (series, day) window partitions.
    in_seg = Window.partitionBy("series_key", "_seg").orderBy("_ts", "_v")
    delta = F.col("_v") - F.lag("_v").over(in_seg)

    # Cross-segment baseline: each segment's first sample takes its delta
    # from the PREVIOUS segment's last value — computed on the per-segment
    # summary (one row per series-day), so the only whole-series window
    # runs over days, not samples. max/min of (ts, v) structs pick the
    # segment's last/first sample with the same (ts, value) tie-break as
    # the lag ordering.
    summary = (s.groupBy("series_key", "_seg")
               .agg(F.max(F.struct(F.col("_ts").alias("t"),
                                   F.col("_v").alias("v")))["v"]
                    .alias("_seg_last")))
    carry_w = Window.partitionBy("series_key").orderBy("_seg")
    carry = summary.select(
        "series_key", "_seg",
        F.lag("_seg_last").over(carry_w).alias("_prev_last"))

    first_in_seg = F.row_number().over(in_seg) == 1
    joined = s.join(carry, ["series_key", "_seg"], "left")
    eff_delta = F.when(first_in_seg,
                       F.when(F.col("_prev_last").isNotNull(),
                              F.col("_v") - F.col("_prev_last"))) \
                 .otherwise(delta)
    return joined.select("series_key", "_ts", "_v",
                         eff_delta.alias("_delta"))


def counter_increase(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
    segment: Optional[str] = "1 day",
) -> DataFrame:
    """(series_key, bucket_ts, increase, n_samples) per tier bucket."""
    d = _sample_deltas(samples, key_col, ts_col, value_col, segment)
    contrib = _contrib(F.col("_delta"), F.col("_v"))
    return (d.select("series_key",
                     _bucket("_ts", tier).alias("bucket_ts"),
                     contrib.alias("_c"))
            .groupBy("series_key", "bucket_ts")
            .agg(F.sum("_c").alias("increase"),
                 F.count(F.lit(1)).alias("n_samples")))


def counter_rate(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
    segment: Optional[str] = "1 day",
) -> DataFrame:
    """increase / bucket-seconds: (series_key, bucket_ts, increase, rate,
    n_samples)."""
    inc = counter_increase(samples, tier, key_col=key_col, ts_col=ts_col,
                           value_col=value_col, segment=segment)
    return inc.withColumn(
        "rate", F.col("increase") / F.lit(float(_interval_seconds(tier))))


def counter_resets(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
    segment: Optional[str] = "1 day",
) -> DataFrame:
    """PromQL ``resets()``: count of counter restarts (negative deltas)
    per tier bucket — the restart-frequency signal operators alert on.
    Output: (series_key, bucket_ts, resets, n_samples)."""
    d = _sample_deltas(samples, key_col, ts_col, value_col, segment)
    return (d.select("series_key",
                     _bucket("_ts", tier).alias("bucket_ts"),
                     (F.col("_delta") < 0).cast("long").alias("_r"))
            .groupBy("series_key", "bucket_ts")
            .agg(F.coalesce(F.sum("_r"), F.lit(0)).alias("resets"),
                 F.count(F.lit(1)).alias("n_samples")))


def gauge_changes(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
    segment: Optional[str] = "1 day",
) -> DataFrame:
    """PromQL ``changes()``: count of adjacent samples whose value
    differs from the previous sample, per tier bucket — the flap /
    state-transition signal for gauges (config versions, leader ids,
    feature flags). A series' globally-first sample has no predecessor
    and never counts, matching PromQL. Bucket attribution follows this
    family's ``resets()`` convention: the delta stream is continuous
    across buckets, so a transition between a bucket's first sample and
    the previous bucket's last sample counts in the LATER bucket
    (PromQL's sliding range window instead restarts at the window edge;
    for that shape, run ``rolling_over_time`` over this output).

    Same segment-partitioned delta stream as ``resets()`` (bounded
    (series, segment) windows + per-segment carry), so a hot series
    never becomes one giant window partition.
    Output: (series_key, bucket_ts, changes, n_samples)."""
    d = _sample_deltas(samples, key_col, ts_col, value_col, segment)
    chg = (F.col("_delta").isNotNull()
           & (F.col("_delta") != 0)).cast("long")
    return (d.select("series_key",
                     _bucket("_ts", tier).alias("bucket_ts"),
                     chg.alias("_c"))
            .groupBy("series_key", "bucket_ts")
            .agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("changes"),
                 F.count(F.lit(1)).alias("n_samples")))


def gauge_delta(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """PromQL ``delta()`` for gauges, per-bucket form: last - first
    value inside each tier bucket (no reset semantics — gauges go both
    ways). A single hash aggregate: first/last picked by (ts, value)
    struct min/max with the family's deterministic tie-break.
    Output: (series_key, bucket_ts, delta, n_samples)."""
    v = F.col(value_col)
    s = samples.where(v.isNotNull()).select(
        F.col(key_col).alias("series_key"),
        _bucket(ts_col, tier).alias("bucket_ts"),
        F.struct(F.col(ts_col).alias("t"), v.alias("v")).alias("_tv"))
    return (s.groupBy("series_key", "bucket_ts")
            .agg((F.max("_tv")["v"] - F.min("_tv")["v"]).alias("delta"),
                 F.count(F.lit(1)).alias("n_samples")))


def counter_irate(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """PromQL ``irate()``, per-bucket form: instantaneous per-second
    rate from the LAST TWO samples of each tier bucket, reset-aware
    (a drop treats the last value as the post-reset increase). Buckets
    with one sample or a zero time-gap yield null.

    Scale shape: one bounded (series, bucket) window to rank from the
    end, rows kept only for rank <= 2, then a hash aggregate — the
    window partition is a tier bucket, never a whole series.
    Output: (series_key, bucket_ts, irate, n_samples)."""
    v = F.col(value_col)
    s = samples.where(v.isNotNull()).select(
        F.col(key_col).alias("series_key"),
        _bucket(ts_col, tier).alias("bucket_ts"),
        F.col(ts_col).alias("_ts"), v.alias("_v"))
    w = Window.partitionBy("series_key", "bucket_ts") \
        .orderBy(F.col("_ts").desc(), F.col("_v").desc())
    ranked = s.select("series_key", "bucket_ts", "_ts", "_v",
                      F.row_number().over(w).alias("_rk"),
                      F.count(F.lit(1)).over(
                          Window.partitionBy("series_key", "bucket_ts"))
                      .alias("_n"))
    top2 = ranked.where(F.col("_rk") <= 2)
    last_tv = F.max(F.when(F.col("_rk") == 1,
                           F.struct(F.col("_ts").alias("t"),
                                    F.col("_v").alias("v"))))
    prev_tv = F.max(F.when(F.col("_rk") == 2,
                           F.struct(F.col("_ts").alias("t"),
                                    F.col("_v").alias("v"))))
    agg = (top2.groupBy("series_key", "bucket_ts")
           .agg(last_tv.alias("_l"), prev_tv.alias("_p"),
                F.max("_n").alias("n_samples")))
    # Fractional-second epoch with DuckDB-epoch() op order (micros /
    # 1e6 per timestamp, THEN subtract) so the oracle's doubles match
    # bit-for-bit; unix_timestamp would truncate to whole seconds.
    def _epoch(c):
        return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)

    dt = _epoch(F.col("_l.t")) - _epoch(F.col("_p.t"))
    dv = F.when(F.col("_l.v") >= F.col("_p.v"),
                F.col("_l.v") - F.col("_p.v")) \
        .otherwise(F.col("_l.v"))                 # reset: post-reset value
    irate = F.when(F.col("_p").isNotNull() & (dt > 0), dv / dt)
    return agg.select("series_key", "bucket_ts",
                      irate.alias("irate"), "n_samples")

def rate_extrapolated(
    samples: DataFrame,
    tier: str = "1 hour",
    *,
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value_double",
) -> DataFrame:
    """PromQL's EXACT ``rate()``/``increase()`` boundary extrapolation,
    per tumbling bucket (the per-bucket analog of Prometheus
    ``promql/functions.go:extrapolatedRate`` — public source): the raw
    in-window increase under-counts whenever samples do not land
    exactly on the window edges, so Prometheus extrapolates it over
    the uncovered edge gaps:

        ds  = firstT - window_start      de = window_end - lastT
        si  = lastT - firstT             avg = si / (n - 1)
        ds  = min(ds, si * firstV / inc)     [counter zero clamp,
                                              when inc > 0, firstV >= 0]
        add ds if ds < 1.1*avg else avg/2; same for de
        extrapolated = inc * ((si + ds' + de') / si)

    Only IN-WINDOW sample pairs contribute to ``inc`` (reset-aware,
    the PromQL contract — a bucket's first sample pairs with nothing),
    and buckets with < 2 samples emit NULL/scored=false exactly like
    PromQL returns no point. Every step is a fixed IEEE shape over
    exact microsecond integers / parquet doubles, so the SQL oracle
    replays the full value.

    Output: (series_key, bucket_ts, n_samples, inc, extrapolated,
    rate, scored); ``rate`` divides by the tier seconds.

    Scale shape: one lag window per (series, BUCKET) — partitions are
    bucket-sized, never whole-series — plus one hash aggregate.
    """
    tier_s = float(_interval_seconds(tier))
    v = F.col(value_col)
    s = samples.where(v.isNotNull()).select(
        F.col(key_col).alias("series_key"),
        _bucket(ts_col, tier).alias("bucket_ts"),
        (F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6))
        .alias("_t"),
        v.cast("double").alias("_v"))
    w = Window.partitionBy("series_key", "bucket_ts") \
        .orderBy("_t", "_v")
    d = s.withColumn("_pv", F.lag("_v").over(w))
    contrib = F.when(F.col("_pv").isNull(), F.lit(0.0)) \
        .when(F.col("_v") - F.col("_pv") >= 0,
              F.col("_v") - F.col("_pv")) \
        .otherwise(F.col("_v"))
    g = (d.groupBy("series_key", "bucket_ts")
         .agg(F.count(F.lit(1)).alias("n_samples"),
              F.sum(contrib).alias("inc"),
              F.min("_t").alias("_t0"),
              F.max("_t").alias("_t1"),
              F.min(F.struct(F.col("_t").alias("t"),
                             F.col("_v").alias("v")))["v"].alias("_v0")))
    start = (F.unix_micros(F.col("bucket_ts").cast("timestamp"))
             / F.lit(1e6))
    si = F.col("_t1") - F.col("_t0")
    ds = F.col("_t0") - start
    de = (start + F.lit(tier_s)) - F.col("_t1")
    avg = si / (F.col("n_samples") - F.lit(1)).cast("double")
    thr = avg * F.lit(1.1)
    dz = si * (F.col("_v0") / F.col("inc"))
    ds2 = F.when((F.col("inc") > 0) & (F.col("_v0") >= 0) & (dz < ds),
                 dz).otherwise(ds)
    dsx = F.when(ds2 < thr, ds2).otherwise(avg / F.lit(2.0))
    dex = F.when(de < thr, de).otherwise(avg / F.lit(2.0))
    ok = (F.col("n_samples") >= 2) & (si > 0)
    extrap = F.col("inc") * ((si + dsx + dex) / si)
    return g.select(
        "series_key", "bucket_ts", "n_samples",
        F.when(ok, F.col("inc")).alias("inc"),
        F.when(ok, extrap).alias("extrapolated"),
        F.when(ok, extrap / F.lit(tier_s)).alias("rate"),
        ok.alias("scored"))


def rate_extrapolated_oracle_sql(samples_sql: str, unit: str,
                                 tier_seconds: int) -> str:
    """DuckDB replay of :func:`rate_extrapolated`: identical window
    pairing, tie-break, clamp order and IEEE op shapes. Kept beside
    the implementation so both stay in sync."""
    t = float(tier_seconds)
    return f"""
WITH s AS (
    SELECT series_key,
           date_trunc('{unit}', ts) AS bucket_ts,
           epoch_us(ts) / 1e6 AS t, CAST(v AS DOUBLE) AS v
    FROM ({samples_sql}) WHERE v IS NOT NULL),
d AS (
    SELECT *, lag(v) OVER (PARTITION BY series_key, bucket_ts
                           ORDER BY t, v) AS pv
    FROM s),
g AS (
    SELECT series_key, bucket_ts,
           count(*) AS n_samples,
           sum(CASE WHEN pv IS NULL THEN 0.0
                    WHEN v - pv >= 0 THEN v - pv
                    ELSE v END) AS inc,
           min(t) AS t0, max(t) AS t1,
           first(v ORDER BY t, v) AS v0
    FROM d GROUP BY 1, 2),
e AS (
    SELECT *,
           epoch_us(bucket_ts) / 1e6 AS st,
           t1 - t0 AS si,
           (t1 - t0) / CAST(n_samples - 1 AS DOUBLE) AS avg
    FROM g),
f AS (
    SELECT *,
           t0 - st AS ds,
           (st + CAST({t!r} AS DOUBLE)) - t1 AS de,
           avg * CAST(1.1 AS DOUBLE) AS thr,
           si * (v0 / inc) AS dz
    FROM e),
h AS (
    SELECT *,
           CASE WHEN inc > 0 AND v0 >= 0 AND si * (v0 / inc) < ds
                THEN si * (v0 / inc) ELSE ds END AS ds2
    FROM f),
x AS (
    SELECT *,
           CASE WHEN ds2 < thr THEN ds2
                ELSE avg / CAST(2.0 AS DOUBLE) END AS dsx,
           CASE WHEN de < thr THEN de
                ELSE avg / CAST(2.0 AS DOUBLE) END AS dex,
           n_samples >= 2 AND si > 0 AS ok
    FROM h)
SELECT series_key, bucket_ts, CAST(n_samples AS BIGINT) AS n_samples,
       CASE WHEN ok THEN inc END AS inc,
       CASE WHEN ok THEN inc * ((si + dsx + dex) / si) END
           AS extrapolated,
       CASE WHEN ok THEN (inc * ((si + dsx + dex) / si))
                         / CAST({t!r} AS DOUBLE) END AS rate,
       ok AS scored
FROM x
"""
